"""ugfraud_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query/data-processing capabilities of safe-graph/UGFraud
(reference at /root/reference, studied for behavior only) as idiomatic
PySpark: DataFrame/SQL plans optimized by Catalyst, vectorized Arrow UDFs
where built-ins can't express the semantics, and a driver-side superstep
loop for the iterative gather-scatter kernels (PageRank, connected
components, label propagation, triangle counting, GANG/ZooBP/SpEagle
belief propagation, Fraudar dense-block peeling, fBox/SVD spectral
scoring).

Design stance (see SURVEY.md §7): DataFrame-first, no RDDs except mllib's
distributed SVD; every join/agg keyed on long vertex ids so Catalyst can
broadcast small dims and AQE can split skewed shuffle partitions; hub
vertices salted explicitly inside the iterative kernels (AQE does not salt
*iterations*).
"""

__version__ = "0.1.0"

from . import json_graph  # noqa: F401

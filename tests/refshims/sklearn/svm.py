"""svm.SVC stub — importable (SVD.py imports it at module scope) but not
runnable: sklearn is absent from this sandbox and the SVC stage is
documented out of parity scope (SURVEY §2.10 E2). The SVD parity tests
compare the svds embedding itself instead."""


class SVC:
    def __init__(self, *args, **kwargs):
        pass

    def fit(self, *args, **kwargs):
        raise NotImplementedError(
            "sklearn is not installed in this sandbox; the SVC stage of "
            "SVD.py is out of parity scope (embedding compared instead)"
        )

    predict = fit
    predict_proba = fit

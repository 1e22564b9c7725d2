"""Inert feature_propagation (run_sapien.py:25 imports it at module scope;
it is only called on the training path, run_sapien.py:208)."""


def feature_propagation(*a, **k):
    raise RuntimeError("msync refstub: feature_propagation is not available "
                       "(reverse parity runs --evaluate only)")

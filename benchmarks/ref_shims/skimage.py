"""Stub module (reference import shim — never called by the bench path)."""
def __getattr__(name):
    raise NotImplementedError("stub module 'skimage' used by reference bench shim")

"""Stub (never called by the bench path)."""
def __getattr__(name):
    raise NotImplementedError("tensorflow_graphics stub")

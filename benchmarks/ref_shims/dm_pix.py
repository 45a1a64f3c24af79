"""Stub module (reference import shim — never called by the bench path)."""
def __getattr__(name):
    raise NotImplementedError("stub module 'dm_pix' used by reference bench shim")

from .cuckoo import CuckooFilter

__all__ = ["CuckooFilter"]

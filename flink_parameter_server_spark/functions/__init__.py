from . import hashing, text, vectors

__all__ = ["hashing", "vectors", "text"]

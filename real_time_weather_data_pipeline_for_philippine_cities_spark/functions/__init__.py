from .hashing import hash28, hash32, hash60  # noqa: F401

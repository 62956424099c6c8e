from . import bits, env, hybrid_rle, roaring  # noqa: F401

from .hashing import h32, h32_sql, MINHASH_PARAMS, MINHASH_PRIME  # noqa: F401
from .text import shingles_expr, shingles_from_tokens, tokens_expr  # noqa: F401
from .vectors import cosine_similarity, dot_product, l2_norm, sign_bucket  # noqa: F401

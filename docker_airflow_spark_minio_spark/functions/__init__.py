from .hashing import h32, h32_sql, MINHASH_PARAMS, MINHASH_PRIME  # noqa: F401
from .text import tokens_expr, shingles_expr  # noqa: F401
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401

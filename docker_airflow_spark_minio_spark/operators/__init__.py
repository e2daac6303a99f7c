from .graph import connected_components  # noqa: F401
from .media import decode_audio, decode_image, extract_byte_features  # noqa: F401
from .skew import salted_join  # noqa: F401
from .temporal import asof_join, sessionize  # noqa: F401

from .audio import chunk_audio  # noqa: F401
from .images import extract_image_meta, decode_images, sample_bytes  # noqa: F401

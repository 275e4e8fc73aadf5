from .encoders import Encoder, StubTextEncoder, StubImageEncoder  # noqa: F401
from .udf import embed_column, make_embed_udf  # noqa: F401

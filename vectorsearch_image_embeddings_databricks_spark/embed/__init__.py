from .encoders import (  # noqa: F401
    Encoder,
    RealImageEncoder,
    RealTextEncoder,
    StubImageEncoder,
    StubTextEncoder,
)
from .udf import embed_column, make_embed_udf  # noqa: F401

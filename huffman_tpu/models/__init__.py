from .gap_codec import GapArrayCodec, Compressed
from .ils_codec import IlsCodec, IlsCompressed

__all__ = ["GapArrayCodec", "Compressed", "IlsCodec", "IlsCompressed"]

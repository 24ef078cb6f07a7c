from .gap_codec import GapArrayCodec, Compressed

__all__ = ["GapArrayCodec", "Compressed"]

from .feed import read_feed_batch, read_feed_stream

__all__ = ["read_feed_batch", "read_feed_stream"]

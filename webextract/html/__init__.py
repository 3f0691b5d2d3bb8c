from webextract.html.tokenizer import iter_events, get_attr
from webextract.html.decode import decode_fragment, strip_tags, collapse_ws

__all__ = ["iter_events", "get_attr", "decode_fragment", "strip_tags", "collapse_ws"]

"""From-scratch single-pass HTML tokenizer over raw bytes.

Yields events with *byte offsets* into the original buffer so that downstream
spans (`start`/`end` block offsets, FIXTURES.md §2) always index the raw
``html`` column — the analog of the reference's rule that predicted polygons
are mapped back to *original image* coordinates and only rounded at the very
end (`mindocr/postprocess/det_base_postprocess.py:110-128`).

The tokenizer is deliberately forgiving (real crawl HTML is broken): an
unterminated tag at EOF simply ends the stream; a stray ``<`` that does not
begin a tag is treated as text. No DOM tree is materialized — the segmenter
(`webextract.stages.segment`) maintains the little state it needs on a stack,
which keeps the hot path allocation-free apart from the event tuples.

Event forms (all offsets are byte offsets):

``("open",  tag, attrs_start, attrs_end, tag_start, content_start)``
``("close", tag, tag_start, tag_end)``
``("text",  start, end)``        -- raw (still entity-encoded) text node
``("skip",  tag, start, end)``   -- script/style/comment/doctype payloads
"""

from __future__ import annotations

import re
from typing import Iterator, Optional, Tuple

# Tags whose raw content must be skipped until the matching close tag.
_RAWTEXT_TAGS = (b"script", b"style")

# HTML void elements: no close tag, no content.
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_OPEN_RE = re.compile(
    rb"<([a-zA-Z][a-zA-Z0-9-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>"
)
_CLOSE_RE = re.compile(rb"</([a-zA-Z][a-zA-Z0-9-]*)\s*>")
_SCRIPT_END = re.compile(rb"</script\s*>", re.IGNORECASE)
_STYLE_END = re.compile(rb"</style\s*>", re.IGNORECASE)

Event = Tuple


def iter_events(html: bytes) -> Iterator[Event]:
    """Single pass over ``html`` yielding tokenizer events (see module doc)."""
    n = len(html)
    pos = 0
    find = html.find
    while pos < n:
        lt = find(b"<", pos)
        if lt < 0:
            if pos < n:
                yield ("text", pos, n)
            return
        if lt > pos:
            yield ("text", pos, lt)
        nxt = html[lt + 1 : lt + 2]
        if nxt == b"!":
            if html[lt + 1 : lt + 4] == b"!--":
                end = find(b"-->", lt + 4)
                end = n if end < 0 else end + 3
                yield ("skip", "comment", lt, end)
                pos = end
            else:  # doctype / CDATA-ish declarations
                end = find(b">", lt + 2)
                end = n if end < 0 else end + 1
                yield ("skip", "doctype", lt, end)
                pos = end
        elif nxt == b"?":
            end = find(b">", lt + 2)
            end = n if end < 0 else end + 1
            yield ("skip", "pi", lt, end)
            pos = end
        elif nxt == b"/":
            m = _CLOSE_RE.match(html, lt)
            if m is None:
                # Broken close tag: swallow to next '>' (or EOF).
                end = find(b">", lt + 2)
                if end < 0:
                    return
                pos = end + 1
            else:
                yield ("close", m.group(1).lower().decode("ascii"), lt, m.end())
                pos = m.end()
        else:
            m = _OPEN_RE.match(html, lt)
            if m is None:
                # '<' not starting a tag: emit it as a 1-byte text node.
                yield ("text", lt, lt + 1)
                pos = lt + 1
            else:
                raw_tag = m.group(1).lower()
                tag = raw_tag.decode("ascii")
                content_start = m.end()
                yield ("open", tag, m.start(2), m.end(2), lt, content_start)
                pos = content_start
                if m.group(3) != b"/" and raw_tag in _RAWTEXT_TAGS:
                    endre = _SCRIPT_END if raw_tag == b"script" else _STYLE_END
                    em = endre.search(html, content_start)
                    if em is None:
                        yield ("skip", tag, content_start, n)
                        return
                    yield ("skip", tag, content_start, em.start())
                    yield ("close", tag, em.start(), em.end())
                    pos = em.end()


_ATTR_RE_CACHE: dict = {}


def get_attr(html: bytes, attrs_start: int, attrs_end: int, name: str) -> Optional[bytes]:
    """Extract attribute ``name`` from the raw attrs slice of an open tag."""
    pat = _ATTR_RE_CACHE.get(name)
    if pat is None:
        pat = re.compile(
            rb"\b" + name.encode("ascii") + rb"\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
            re.IGNORECASE,
        )
        _ATTR_RE_CACHE[name] = pat
    m = pat.search(html, attrs_start, attrs_end)
    if m is None:
        return None
    return m.group(2) if m.group(2) is not None else (
        m.group(3) if m.group(3) is not None else m.group(4)
    )

"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Gold-first construction: the generator creates the gold main-content text
FIRST, then wraps it in boilerplate — the analog of the reference system test
rendering known text onto a blank image before OCR-ing it back
(`tests/st/test_online_infer.py:10-44`). So `text` is known byte-exactly by
construction and the extractor must reproduce it byte-identically.

Two entry points:

* :func:`render_page` — pure function `(doc_id, text, lang) -> html bytes`
  used to derive a `pages` table from the driver's `documents.parquet`
  (same split/render in SQL-oracle form lives in `__ray_entry__.oracle_sql`).
* :func:`generate_pages` / :func:`write_corpus` — standalone seeded corpus
  with a skewed host distribution, a giant-page tail, embedded-PDF rows and
  malformed rows, used by pytest and `bench.py`.

Determinism: no `random` module — a hand-rolled 64-bit SplitMix mixer keyed
by `doc_id` drives every choice, so output is stable across Python versions
and processes (the extract path itself contains NO randomness at all;
SURVEY.md §7.4).
"""

from __future__ import annotations

import datetime
from html import escape
from typing import List

# --- deterministic per-doc pseudo-randomness (SplitMix64 mixer) -------------

# bump when generator output changes — bench corpus cache paths embed this
CORPUS_VERSION = 5

_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def mix(doc_id: int, stream: int = 0) -> int:
    """Stable 64-bit hash of (doc_id, stream)."""
    return _mix(_mix(doc_id) ^ _mix(stream + 0xD1B54A32D192ED03))


# --- row-class predicates (shared with the SQL oracles) ---------------------

CORRUPT_MOD, CORRUPT_REM = 50, 7  # rows with undecodable truncated bytes
PDF_MOD, PDF_REM = 25, 3  # rows carried as fake-PDF payloads


def is_corrupt(doc_id: int) -> bool:
    return doc_id % CORRUPT_MOD == CORRUPT_REM


def is_pdf(doc_id: int) -> bool:
    return doc_id % PDF_MOD == PDF_REM


TWOCOL_MOD, TWOCOL_REM = 17, 5  # rows rendered as a two-column layout


def is_two_column(doc_id: int) -> bool:
    """Rows whose article renders as a CSS two-column layout with the RIGHT
    column first in byte order — reading order (left, then right) differs
    from byte order, exercising `sorted_layout_boxes` semantics
    (reference `tools/infer/text/utils/recovery_to_doc.py:90-160`). Gold
    text is UNCHANGED (original paragraph order); the extractor must
    reorder. PDF rows keep their own renderer."""
    return doc_id % TWOCOL_MOD == TWOCOL_REM and not is_pdf(doc_id)


LATIN1_MOD, LATIN1_REM = 23, 9  # rows encoded ISO-8859-1 with a meta charset


def is_latin1(doc_id: int) -> bool:
    """Rows whose html bytes are Windows-1252 (declared via
    ``<meta charset>``; the title em-dash and the sidebar "Café" ad are
    single legacy bytes that are invalid UTF-8) — the mixed-encoding
    adversarial class. The extractor must sniff the declared charset when
    strict UTF-8 decode fails and still produce byte-identical gold text.
    Corrupt rows are EXCLUDED: their truncated pages must keep failing
    decode (cp1252 decode never fails, which would un-quarantine
    them)."""
    return (doc_id % LATIN1_MOD == LATIN1_REM and not is_pdf(doc_id)
            and not is_corrupt(doc_id))


CDATA_MOD, CDATA_REM = 9, 4  # rows with CDATA noise (script + bogus comment)
UNCLOSED_MOD, UNCLOSED_REM = 13, 6  # rows with unclosed sidebar <p>/<b>
EMPTYP_MOD, EMPTYP_REM = 8, 1  # rows with zero-length <p> blocks in-article
ATTRGT_MOD, ATTRGT_REM = 5, 2  # rows with a quoted '>' inside a <p> attribute


THREECOL_MOD, THREECOL_REM = 19, 11  # rows rendered as a 3-col layout


def is_three_column(doc_id: int) -> bool:
    """Rows rendered as a THREE-column layout (right, mid, left in byte
    order) with — when the article has >= 4 paragraphs — a full-width
    SPANNING block in the middle that splits the columns into two
    independent groups (the reference's triple-column + spanning layout,
    `recovery_to_doc.py:90-160`). Gold stays the original paragraph order:
    the extractor must read group 1 left->mid->right, then the spanning
    block, then group 2."""
    return (doc_id % THREECOL_MOD == THREECOL_REM and not is_pdf(doc_id)
            and not is_two_column(doc_id))


# --- gold construction ------------------------------------------------------


def split_paragraphs(text: str, doc_id: int) -> List[str]:
    """Split canonical text into k word chunks; k = doc_id%3+1, EXCEPT
    three-column rows which use k=5 (enough paragraphs to exercise the
    two column groups around the spanning block).

    MUST stay in lockstep with the DuckDB oracles in `__ray_entry__.py`
    (words[i*n//k : (i+1)*n//k] joined by ' '; the SQL k expression is
    `CASE WHEN <threecol> THEN 5 ELSE doc_id % 3 + 1 END`).
    """
    words = text.split(" ")
    k = 5 if is_three_column(doc_id) else doc_id % 3 + 1
    n = len(words)
    return [" ".join(words[i * n // k : (i + 1) * n // k]) for i in range(k)]


def gold_text(text: str, doc_id: int) -> str:
    """The byte-exact text the extractor must emit ('' for corrupt rows).

    Empty chunks (texts shorter than k words) are dropped — empty blocks
    vanish under the decode rules (the CTC blank analog), so gold must not
    contain them. Mirrored by `list_filter(..., c -> c <> '')` in the SQL
    oracles.
    """
    if is_corrupt(doc_id):
        return ""
    return "\n".join(p for p in split_paragraphs(text, doc_id) if p)


# --- url / timestamp --------------------------------------------------------

_BASE_TS = datetime.datetime(2024, 1, 1, 0, 0, 0)


def host_of(doc_id: int) -> int:
    """Deliberately skewed host assignment: ~30% of rows on one hot host
    (exercises salted repartition; FIXTURES.md §1)."""
    if doc_id % 10 < 3:
        return 0
    return 1 + mix(doc_id, 1) % 96


def url_of(doc_id: int) -> str:
    return f"https://host{host_of(doc_id)}.example/doc/{doc_id}"


def ts_of(doc_id: int) -> datetime.datetime:
    return _BASE_TS + datetime.timedelta(seconds=doc_id)


# --- HTML rendering ---------------------------------------------------------

_NAV_WORDS = ["Home", "About", "Products", "Blog", "Contact", "Careers", "Support", "News"]
_AD_WORDS = ["Deals", "Sale", "Trending", "Sponsored", "Hot", "New", "Top", "Featured"]


def _decorate(paragraph: str, doc_id: int, idx: int) -> str:
    """Inject markup noise that the decode rules must invert exactly:
    inline tags (strip_tags), a numeric entity (unescape), a whitespace run
    (collapse_ws). Gold text is untouched by construction."""
    content = escape(paragraph)
    if idx == 0:
        if doc_id % 7 == 0:
            words = content.split(" ")
            if len(words) > 3:
                words[2] = "<em>" + words[2] + "</em>"
                content = " ".join(words)
        if doc_id % 13 == 0 and "a" in paragraph and content == paragraph:
            # only when escape() was the identity — otherwise the 'a' we
            # replace could sit inside an entity like &amp; and corrupt it
            content = content.replace("a", "&#97;", 1)
        if doc_id % 11 == 0 and " " in content:
            content = content.replace(" ", "\n      ", 1)
        if doc_id % 21 == 8:
            # UNCLOSED inline tag at the content end: strip_tags must drop
            # it without a matching close, and the scanner must implicitly
            # pop the dangling <i> element when </p> arrives
            content = content + "<i>"
    return content


def _render_parts(doc_id: int, text: str, lang: str):
    """Render piece list + block marks (single source of truth for both the
    html bytes and the blocks_gold span fixture).

    Returns (parts, marks) where marks = [(part_idx, kind, gold_text,
    ignore)]: `part_idx` points at the part holding exactly the content
    between a block's open and close tags (FIXTURES.md §2 `blocks_gold`;
    ignore=True marks boilerplate blocks the detector may legally include
    or exclude — the ###/ignore_tags convention, det_transforms.py:77-80).
    """
    paras = [p for p in split_paragraphs(text, doc_id) if p]
    h = host_of(doc_id)
    parts: List[str] = []
    marks: List[tuple] = []
    a = parts.append
    a(f'<!DOCTYPE html>\n<html lang="{escape(lang)}">\n<head>\n')
    a(f"<title>Doc {doc_id} — host{h}</title>\n")
    if is_latin1(doc_id):
        a('<meta charset="windows-1252">\n')
    else:
        a('<meta charset="utf-8">\n')
    a("<style>body { margin: 0; } .nav a { color: #00c; }</style>\n")
    if doc_id % CDATA_MOD == CDATA_REM:
        # CDATA wrapper + fake markup inside raw script text: the scanner
        # must skip everything to </script> (adversarial fuzz class)
        a(f"<script>/*<![CDATA[*/ var docId = {doc_id}; "
          "var cd = '<p>cdata fake paragraph</p>'; /*]]>*/</script>\n")
    else:
        a(f"<script>var docId = {doc_id}; if (docId < 0) console.log('<p>never</p>');</script>\n")
    a("</head>\n<body>\n")
    if doc_id % CDATA_MOD == CDATA_REM:
        # bare CDATA section in body = HTML5 "bogus comment": consumed to
        # the first '>' (its own closer), contributing no text
        a("<![CDATA[cdata boilerplate block not article text]]>\n")
    # header: contains real-looking <p> text that MUST be excluded (container rule)
    welcome = f"Welcome to host{h}.example — the number {doc_id % 1000} source for documents."
    a(f'<header class="site-header"><h1>Site host{h}</h1><p>')
    marks.append((len(parts), "p", welcome, True))
    a(welcome)
    a("</p></header>\n")
    # nav link farm: link density 1.0
    n_nav = 3 + doc_id % 5
    a('<nav class="nav"><ul>')
    for i in range(n_nav):
        # entities inside attribute values (must never leak into text or
        # break attr parsing; href stays bare — the link-inventory oracle
        # reconstructs it in SQL)
        a(f'<li><a href="/p{i}" title="Q&#38;A &amp; more">'
          f"{_NAV_WORDS[(doc_id + i) % 8]}</a></li>")
    a("</ul></nav>\n")
    a('<div class="content"><article>\n')
    a(f"<!-- article {doc_id} rendered {doc_id % 97} -->\n")

    def emit_para(i: int, p: str, cls: str = "") -> None:
        if i == 0 and doc_id % ATTRGT_MOD == ATTRGT_REM:
            # quoted '>' inside an attribute value: the tag does NOT end at
            # that '>' (quote-aware attr parsing, adversarial fuzz class)
            attr = f' title="a &gt; b > c" data-x="{doc_id}"'
        else:
            attr = ""
        a(f'  <p class="{cls}"{attr}>' if cls else f"  <p{attr}>")
        marks.append((len(parts), "p", p, False))
        a("\n    " + _decorate(p, doc_id, i) + "\n  ")
        a("</p>\n")

    def emit_col_group(idxs: List[int]) -> None:
        # three columns, rendered RIGHT, MID, LEFT in byte order; reading
        # order is left -> mid -> right (recovery_to_doc.py triple layout)
        third = (len(idxs) + 2) // 3
        cols = [idxs[:third], idxs[third:2 * third], idxs[2 * third:]]
        for ci, cls in ((2, "col-right"), (1, "col-mid"), (0, "col-left")):
            a(f'<div class="col {cls}">\n')
            for i in cols[ci]:
                emit_para(i, paras[i])
            a("</div>\n")

    if is_three_column(doc_id) and paras:
        np_ = len(paras)
        a('<div class="columns">\n')
        if np_ >= 4:
            k = np_ // 2  # paras[k] = the spanning "new section" block
            emit_col_group(list(range(0, k)))
            emit_para(k, paras[k], cls="col-span")
            emit_col_group(list(range(k + 1, np_)))
        else:
            emit_col_group(list(range(np_)))
        a("</div>\n")
    elif is_two_column(doc_id) and paras:
        # two-column layout: RIGHT column first in byte order; reading
        # order (gold) is left column then right. `col-left`/`col-right`
        # classes are the x-position hint (the sorted_layout_boxes analog).
        half = (len(paras) + 1) // 2
        a('<div class="columns">\n')
        a('<div class="col col-right">\n')
        for i in range(half, len(paras)):
            emit_para(i, paras[i])
        a('</div>\n<div class="col col-left">\n')
        for i in range(half):
            emit_para(i, paras[i])
        a("</div>\n</div>\n")
    else:
        empty_p = doc_id % EMPTYP_MOD == EMPTYP_REM
        for i, p in enumerate(paras):
            emit_para(i, p)
            if empty_p and i == 0:
                # ZERO-LENGTH blocks: no text content at all / whitespace
                # only — both must vanish (the CTC blank-drop analog),
                # never shifting n_blocks or the emitted text
                a("<p></p>\n  <p>  \n   </p>\n")
    a("</article></div>\n")
    # sidebar ad/link farm
    a('<aside class="sidebar"><p>')
    for i in range(4 + doc_id % 3):
        a(f'<a href="/ad{i}">{_AD_WORDS[(doc_id * 3 + i) % 8]}</a> ')
    if is_latin1(doc_id):
        # the one non-ASCII byte of the page: 'é' is a bare 0xE9 in the
        # ISO-8859-1 bytes — invalid UTF-8, forcing the charset-sniff path
        a('<a href="/ad-cafe">Café</a> ')
    a("</p></aside>\n")
    if doc_id % UNCLOSED_MOD == UNCLOSED_REM:
        # UNCLOSED <p> and <b> inside boilerplate: implicit closes only —
        # the scanner must not let the dangling block swallow the article
        # or misalign later closes
        a('<aside class="sidebar"><p>More <b>deals today</aside>\n')
    # comments: boilerplate by class hint
    comment = f"Great post, thanks for sharing number {doc_id % 9}!"
    a('<div class="comments"><p class="comment-body">')
    marks.append((len(parts), "p", comment, True))
    a(comment)
    a("</p></div>\n")
    copyright_ = f"Copyright 2024 host{h}.example. All rights reserved."
    a('<footer class="footer"><p>')
    marks.append((len(parts), "p", copyright_, True))
    a(copyright_)
    a("</p></footer>\n")
    a("</body>\n</html>\n")
    return parts, marks


def _page_enc(doc_id: int, parts: List[str]) -> str:
    """Byte encoding of one rendered page: Windows-1252 for the latin1
    rows (falling back to utf-8 if the document text itself cannot encode
    — then the page is valid UTF-8 and the sniff path never triggers)."""
    if not is_latin1(doc_id):
        return "utf-8"
    try:
        "".join(parts).encode("cp1252")
        return "cp1252"
    except UnicodeEncodeError:
        return "utf-8"


def render_html(doc_id: int, text: str, lang: str) -> bytes:
    """Deterministically wrap gold paragraphs in boilerplate."""
    parts, _ = _render_parts(doc_id, text, lang)
    return "".join(parts).encode(_page_enc(doc_id, parts))


def gold_blocks(doc_id: int, text: str, lang: str) -> List[dict]:
    """blocks_gold rows for one doc: byte-offset spans of every rendered
    block, ignore=True for boilerplate (FIXTURES.md §2)."""
    parts, marks = _render_parts(doc_id, text, lang)
    enc = _page_enc(doc_id, parts)
    lens = [len(p.encode(enc)) for p in parts]
    starts = [0]
    for n in lens:
        starts.append(starts[-1] + n)
    return [
        {
            "start": starts[idx],
            "end": starts[idx] + lens[idx],
            "kind": kind,
            "text": gold,
            "ignore": ignore,
        }
        for idx, kind, gold, ignore in marks
    ]


# --- fake PDF rendering (deterministic stand-in; real PDF libs absent) ------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def render_pdf(doc_id: int, text: str) -> bytes:
    """Deterministic fake PDF: one `BT (...) Tj ET` text op per paragraph.

    Stand-in for a real PDF layout parse (libs not in this container); the
    Ray-side plumbing — binary payload column, branch routing, span offsets,
    actor signature — is real and tested (see stages/extract.py).
    """
    paras = [p for p in split_paragraphs(text, doc_id) if p]
    body = "\n".join(
        f"BT /F1 12 Tf 72 {720 - 14 * i} Td ({_pdf_escape(p)}) Tj ET"
        for i, p in enumerate(paras)
    )
    return (
        "%PDF-1.4\n% fake deterministic fixture\n"
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        "2 0 obj << /Type /Pages /Count 1 >> endobj\n"
        f"3 0 obj << /Length {len(body)} >> stream\n{body}\nendstream endobj\n"
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    ).encode("utf-8")


def render_page(doc_id: int, text: str, lang: str) -> bytes:
    """Dispatch: corrupt / pdf / html payload for one document."""
    if is_corrupt(doc_id):
        good = render_html(doc_id, text, lang)
        return good[: len(good) // 2] + b"\xff\xfe\xff<div"
    if is_pdf(doc_id):
        return render_pdf(doc_id, text)
    return render_html(doc_id, text, lang)


# --- standalone corpus (pytest + bench) -------------------------------------

_POOL = (
    "the data stream sort merge join filter scan table index hash key value "
    "row column batch block shard spark ray arrow parquet vector query plan "
    "group window agg count sum page crawl text span block host link anchor"
).split()


def make_text(doc_id: int, min_words: int = 40, max_words: int = 400) -> str:
    """Seeded canonical text (single-space separated pool words)."""
    span = max_words - min_words + 1
    n = min_words + mix(doc_id, 2) % span
    if mix(doc_id, 3) % 200 == 0:  # giant-page tail for skew tests
        n *= 50
    pool = _POOL
    np_ = len(pool)
    return " ".join(pool[mix(doc_id, 4 + i) % np_] for i in range(n))


_LANGS = ["en", "zh", "de", "fr", "es"]


def generate_pages(n_rows: int, start_id: int = 0):
    """Yield dict rows of the `pages` table (PAGES_SCHEMA) deterministically."""
    for doc_id in range(start_id, start_id + n_rows):
        text = make_text(doc_id)
        lang = _LANGS[mix(doc_id, 99) % len(_LANGS)]
        yield {
            "url": url_of(doc_id),
            "warc_ts": ts_of(doc_id),
            "html": render_page(doc_id, text, lang),
            "text": gold_text(text, doc_id),
            "lang": lang,
        }


def write_corpus(path: str, n_rows: int, rows_per_file: int = 20000) -> str:
    """Write a seeded `pages` corpus as partitioned Parquet (resumable layout:
    one file per shard, never one giant file)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from webextract.schema import PAGES_SCHEMA

    os.makedirs(path, exist_ok=True)
    shard = 0
    for base in range(0, n_rows, rows_per_file):
        cnt = min(rows_per_file, n_rows - base)
        rows = list(generate_pages(cnt, start_id=base))
        table = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
        pq.write_table(table, os.path.join(path, f"pages-{shard:05d}.parquet"))
        shard += 1
    return path


def write_corpus_ray(path: str, n_rows: int, rows_per_file: int = 20000) -> str:
    """Ray-parallel corpus writer (same rows as write_corpus, any sharding).

    Rendering is a pure function of doc_id, so generation distributes as
    `range(n) -> map_batches(render)` — used by bench.py for the large
    scaling corpora. Requires an initialised Ray session.
    """
    import os

    import pyarrow as pa
    import ray.data

    from webextract.schema import PAGES_SCHEMA

    os.makedirs(path, exist_ok=True)

    def gen(batch: pa.Table) -> pa.Table:
        rows = [
            next(generate_pages(1, start_id=i))
            for i in batch.column("id").to_pylist()
        ]
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    (
        ray.data.range(n_rows)
        .repartition(max(1, n_rows // rows_per_file))
        .map_batches(gen, batch_format="pyarrow", batch_size=rows_per_file)
        .write_parquet(path)
    )
    return path

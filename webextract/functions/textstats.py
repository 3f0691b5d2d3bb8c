"""Text analysis operators over a documents-style table.

Vectorized where Arrow kernels exist (`pyarrow.compute`); per-row Python only
for hashing (hashlib is C-speed per call). All deterministic — no RNG.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List

import pyarrow as pa
import pyarrow.compute as pc

# --- quality / token stats (vectorized) -------------------------------------


def quality_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add n_chars (utf8 length) and n_tokens (single-space word count).

    Token rule = `len(text.split(' '))` — mirrored by the DuckDB oracle
    `len(string_split(text, ' '))`, exact on whitespace-canonical text.
    """
    text = batch.column(text_col)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(
        pc.list_value_length(pc.split_pattern(text, " ")), pa.int64()
    )
    return batch.append_column("n_chars_c", n_chars).append_column(
        "n_tokens", n_tokens
    )


# --- BPE-ish regex tokenization ----------------------------------------------

# word runs OR single non-word-non-space chars — the classic pre-BPE split.
# Mirrored by the DuckDB oracle regexp_extract_all(text, '\w+|[^\w\s]').
_BPE_RE = None


def _bpe_re():
    global _BPE_RE
    if _BPE_RE is None:
        import re

        _BPE_RE = re.compile(r"\w+|[^\w\s]")
    return _BPE_RE


def bpe_tokens(text: str) -> List[str]:
    return _bpe_re().findall(text)


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    pat = _bpe_re()
    counts = [len(pat.findall(s or "")) for s in batch.column(text_col).to_pylist()]
    return batch.append_column(
        "n_bpe_tokens", pa.array(counts, type=pa.int64())
    )


# --- composite quality score --------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is are was for with on at by it this that".split()
)


def quality_score(text: str) -> dict:
    """Length / punctuation / stopword heuristics (C4/Gopher-style filters).

    Returns ratios in [0,1] plus a composite `quality` in [0,1]. Pure,
    deterministic; thresholds live with the caller (a filter op decides).
    """
    if not text:
        return {"alpha_ratio": 0.0, "punct_ratio": 0.0, "stopword_ratio": 0.0,
                "mean_word_len": 0.0, "quality": 0.0}
    n = len(text)
    alpha = sum(ch.isalpha() or ch == " " for ch in text) / n
    punct = sum(not ch.isalnum() and not ch.isspace() for ch in text) / n
    words = text.lower().split()
    stop = sum(w in _STOPWORDS for w in words) / len(words) if words else 0.0
    mwl = sum(len(w) for w in words) / len(words) if words else 0.0
    # composite: alphabetic, lightly punctuated, plausible word lengths
    quality = max(
        0.0,
        min(1.0, alpha - 2.0 * max(0.0, punct - 0.1)
            - (0.3 if not 2.0 <= mwl <= 12.0 else 0.0)),
    )
    return {"alpha_ratio": alpha, "punct_ratio": punct, "stopword_ratio": stop,
            "mean_word_len": mwl, "quality": quality}


def quality_score_batch(batch: pa.Table, text_col: str = "text",
                        round_to: int = 6) -> pa.Table:
    """Vectorized quality_score over a batch.

    `round_to=None` emits raw float64 ratios — exact IEEE divisions of
    integer counts, bit-identical to a SQL engine computing the same
    divisions (np.round is half-to-even while DuckDB rounds half-away, so
    ORACLE comparisons must use the unrounded values).

    The per-CHARACTER ratios (alpha, punct) are Arrow regex-count kernels —
    no Python loop over chars; only the per-WORD stats (stopword ratio,
    mean word length) do one `str.split` per row (O(words) << O(chars)).
    Matches :func:`quality_score` exactly on text without exotic Unicode
    whitespace (pinned by a parity test); `\\x0b` is folded into the
    whitespace class to align re2's ASCII `\\s` with Python `isspace`.
    """
    import numpy as np

    text = batch.column(text_col)
    texts = text.to_pylist()
    n_rows = len(texts)
    filled = pc.fill_null(text, "")
    n = pc.utf8_length(filled).to_numpy(zero_copy_only=False).astype(np.float64)
    # count the RARE complement class (re2 cost is per match, so counting
    # the near-universal [\pL ] class would be O(chars) matches)
    non_alpha_cnt = pc.count_substring_regex(filled, r"[^\pL ]").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    alpha_cnt = n - non_alpha_cnt
    punct_cnt = pc.count_substring_regex(filled, r"[^\pL\pN\s\x0b]").to_numpy(
        zero_copy_only=False
    ).astype(np.float64)

    stop = np.zeros(n_rows)
    mwl = np.zeros(n_rows)
    stopwords = _STOPWORDS
    for i, s in enumerate(texts):
        words = (s or "").lower().split()
        if words:
            stop[i] = sum(w in stopwords for w in words) / len(words)
            mwl[i] = sum(len(w) for w in words) / len(words)

    nz = n > 0
    alpha = np.where(nz, alpha_cnt / np.maximum(n, 1.0), 0.0)
    punct = np.where(nz, punct_cnt / np.maximum(n, 1.0), 0.0)
    quality = np.clip(
        alpha - 2.0 * np.maximum(0.0, punct - 0.1)
        - 0.3 * ~((mwl >= 2.0) & (mwl <= 12.0)),
        0.0, 1.0,
    )
    quality = np.where(nz, quality, 0.0)
    for name, vals in (
        ("alpha_ratio", alpha), ("punct_ratio", punct),
        ("stopword_ratio", stop), ("mean_word_len", mwl),
        ("quality", quality),
    ):
        if round_to is not None:
            vals = np.round(vals, round_to)
        batch = batch.append_column(
            name, pa.array(vals, type=pa.float64())
        )
    return batch


# --- content fingerprint ----------------------------------------------------


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add `fp` = hex md5 of the text bytes (content-hash lineage unit;
    matches DuckDB `md5(text)` byte-for-byte)."""
    fps = [
        hashlib.md5(s.encode("utf-8")).hexdigest() if s is not None else None
        for s in batch.column(text_col).to_pylist()
    ]
    return batch.append_column("fp", pa.array(fps, type=pa.string()))


# --- language identification (n-gram/stopword heuristic) --------------------

_LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "que", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para"],
}


def lang_id(text: str) -> str:
    """Heuristic language ID: CJK codepoint ratio, then stopword votes.

    Deterministic tie-break: highest vote count, then alphabetical lang code;
    'und' (undetermined) when nothing matches.
    """
    if not text:
        return "und"
    cjk = sum(1 for ch in text[:2000] if "一" <= ch <= "鿿")
    if cjk > 0.2 * min(len(text), 2000):
        return "zh"
    words = set(text.lower().split())
    best, best_score = "und", 0
    for code in sorted(_LANG_MARKERS):
        score = sum(1 for m in _LANG_MARKERS[code] if m in words)
        if score > best_score:
            best, best_score = code, score
    return best


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    preds = [lang_id(s or "") for s in batch.column(text_col).to_pylist()]
    return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


# --- rolling-hash document fingerprint (shingle-level) ----------------------

_MOD = (1 << 61) - 1
_BASE = 1_000_003


def rolling_hashes(text: str, window: int = 32) -> List[int]:
    """Polynomial rolling hash over a sliding character window (Rabin-Karp);
    deterministic, used for fingerprint sketches."""
    n = len(text)
    if n < window:
        window = max(n, 1)
    h = 0
    pw = pow(_BASE, window - 1, _MOD)
    out = []
    for i, ch in enumerate(text):
        h = (h * _BASE + ord(ch)) % _MOD
        if i >= window - 1:
            out.append(h)
            h = (h - ord(text[i - window + 1]) * pw) % _MOD
    return out if out else [h]


# --- repetition statistics (Gopher-style quality signals) -------------------


def repetition_stats_batch(batch: pa.Table,
                           text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models", table A1 repetition filters):

    * `dup_line_frac` — fraction of LINES whose exact text occurs more
      than once in the document;
    * `dup_line_char_frac` — fraction of line characters sitting in such
      duplicate lines;
    * `top_2gram_char_frac` — characters covered by occurrences of the
      most frequent word 2-gram divided by total characters (tie-break:
      lexicographically smallest gram).

    All ratios are raw IEEE divisions of integer counts (oracle-parity
    discipline, see quality_score_batch); tokenization is the engine-wide
    whitespace split.
    """
    from collections import Counter

    dl, dlc, tg = [], [], []
    for t in batch.column(text_col).to_pylist():
        t = t or ""
        lines = t.split("\n")
        lc = Counter(lines)
        n_lines = len(lines)
        total_line_chars = sum(len(ln) for ln in lines)
        dup_lines = sum(1 for ln in lines if lc[ln] > 1)
        dup_chars = sum(len(ln) for ln in lines if lc[ln] > 1)
        dl.append(dup_lines / n_lines if n_lines else 0.0)
        dlc.append(dup_chars / total_line_chars if total_line_chars else 0.0)
        words = t.split()
        if len(words) >= 2 and len(t):
            gc = Counter(" ".join((words[i], words[i + 1]))
                         for i in range(len(words) - 1))
            top = min(gc.items(), key=lambda kv: (-kv[1], kv[0]))
            tg.append(top[1] * len(top[0]) / len(t))
        else:
            tg.append(0.0)
    return (
        batch.append_column("dup_line_frac", pa.array(dl, type=pa.float64()))
        .append_column("dup_line_char_frac",
                       pa.array(dlc, type=pa.float64()))
        .append_column("top_2gram_char_frac",
                       pa.array(tg, type=pa.float64()))
    )

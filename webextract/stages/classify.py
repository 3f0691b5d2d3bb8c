"""Optional classifier stage — the TextClassifier analog.

The reference inserts an optional angle classifier between detect and
recognize (`tools/infer/text/predict_system.py:41-97, :294-314`) that fixes
crop orientation before recognition. The web-doc analog is a charset /
language classifier on the extracted text: an actor-pool stage that stamps
`lang_pred` (n-gram/stopword heuristic) and `charset` so downstream routing
(e.g. CJK-specific tokenization) can branch per row.
"""

from __future__ import annotations

import pyarrow as pa

from webextract.functions.textstats import lang_id


def _charset_of(text: str) -> str:
    if not text:
        return "empty"
    sample = text[:2000]
    n_ascii = sum(1 for ch in sample if ord(ch) < 128)
    if n_ascii == len(sample):
        return "ascii"
    return "utf-8"


class LangClassifier:
    """map_batches actor UDF: add `lang_pred` + `charset` columns."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        preds = [lang_id(t or "") for t in texts]
        charsets = [_charset_of(t or "") for t in texts]
        return batch.append_column(
            "lang_pred", pa.array(preds, type=pa.string())
        ).append_column("charset", pa.array(charsets, type=pa.string()))

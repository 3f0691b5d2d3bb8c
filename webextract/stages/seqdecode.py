"""EOS-terminated sequence decoders — the Attn/Master/SAR decode family.

Real ports of the reference's stop-token decode semantics over integer
token-index sequences (closing SURVEY §2.2's "variant encoders" row with
actual ops, not just the pattern):

* :class:`AttnDecoder` — `RecAttnLabelDecode`
  (`mindocr/postprocess/rec_postprocess.py:255-346`): dict = ["<GO>",
  "<STOP>"] + charset; decode truncates at the FIRST <STOP>; a sequence
  with no <STOP> decodes to "" (the reference's explicit rule, :335-337);
  confidence = mean prob up to the stop token, 0.0 when absent.
* :class:`MasterDecoder` — `RecMasterLabelDecode` (:372-448): same decode,
  dict = ["<GO>", "<STOP>", "<PAD>"] + charset (+ "<UNKNOWN>" when
  enabled).
* :class:`SARDecoder` — `SARLabelDecode` (:450-546): dict = charset +
  ["<UKN>", "<BOS/EOS>", "<PAD>"] where BOS and EOS share one index;
  decode skips padding, breaks at EOS (keeping the reference's
  leading-EOS-without-probs continue quirk), optional repeat collapse and
  `rm_symbol` cleanup.

All decoders run per row inside `map_batches` (stateless after __init__ —
the char dict is built once per actor, the §2.3 stateful-setup pattern).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence

import pyarrow as pa

_DEFAULT_CHARSET = "0123456789abcdefghijklmnopqrstuvwxyz"


class AttnDecoder:
    """GO/STOP decode: text = chars before the first <STOP>, else ''."""

    specials = ("<GO>", "<STOP>")

    def __init__(self, charset: Optional[Sequence[str]] = None,
                 use_space_char: bool = False, lower: bool = False):
        chars = list(charset) if charset is not None else list(_DEFAULT_CHARSET)
        if charset is None:
            lower = True  # the reference's default-dict behavior (:283-285)
        if use_space_char and " " not in chars:
            chars.append(" ")
        self.lower = lower
        self.character = list(self.specials) + chars
        self.go_idx = 0
        self.stop_idx = 1
        self.num_classes = len(self.character)

    def decode_one(self, ids: Sequence[int],
                   probs: Optional[Sequence[float]] = None):
        chars = [self.character[i] for i in ids]
        try:
            eos = chars.index("<STOP>")
        except ValueError:
            eos = -1
        if self.lower:
            chars = [c.lower() for c in chars]
        text = "".join(chars[:eos]) if eos != -1 else ""
        if probs is not None and eos != -1:
            conf = (sum(probs[:eos]) / eos) if eos else 0.0
        else:
            conf = 0.0
        return text, conf


class MasterDecoder(AttnDecoder):
    """GO/STOP/PAD decode (Master head): decode rule identical to Attn."""

    specials = ("<GO>", "<STOP>", "<PAD>")

    def __init__(self, charset: Optional[Sequence[str]] = None,
                 use_space_char: bool = False, use_unknown_char: bool = False,
                 lower: bool = False):
        super().__init__(charset, use_space_char, lower)
        self.pad_idx = 2
        self.unknown_idx = None
        if use_unknown_char:
            self.character.append("<UNKNOWN>")
            self.unknown_idx = len(self.character) - 1
            self.num_classes = len(self.character)


class SARDecoder:
    """SAR decode: charset + [<UKN>, <BOS/EOS>, <PAD>]; EOS breaks, PAD is
    skipped, BOS==EOS index."""

    def __init__(self, charset: Optional[Sequence[str]] = None,
                 use_space_char: bool = False, rm_symbol: bool = False,
                 reverse: bool = False):
        chars = list(charset) if charset is not None else list(_DEFAULT_CHARSET)
        if use_space_char:
            chars.append(" ")
        chars = chars + ["<UKN>"]
        self.unknown_idx = len(chars) - 1
        chars = chars + ["<BOS/EOS>"]
        self.start_idx = self.end_idx = len(chars) - 1
        chars = chars + ["<PAD>"]
        self.padding_idx = len(chars) - 1
        self.character = chars
        self.rm_symbol = rm_symbol
        self.reverse = reverse  # arabic right-to-left dicts (:502-503)
        self._sym = re.compile("[^A-Z^a-z^0-9^一-龥]")

    def decode_one(self, ids: Sequence[int],
                   probs: Optional[Sequence[float]] = None,
                   is_remove_duplicate: bool = False):
        chars: List[str] = []
        confs: List[float] = []
        for idx, tid in enumerate(ids):
            tid = int(tid)
            if tid == self.padding_idx:
                continue
            if tid == self.end_idx:
                # reference quirk (:506-510): a LEADING EOS with no probs is
                # skipped (it is the BOS of a label sequence), otherwise EOS
                # terminates
                if probs is None and idx == 0:
                    continue
                break
            if is_remove_duplicate and idx > 0 and ids[idx - 1] == tid:
                continue
            chars.append(self.character[tid])
            confs.append(probs[idx] if probs is not None else 1.0)
        if self.reverse:
            chars = chars[::-1]
        text = "".join(chars)
        if self.rm_symbol:
            text = self._sym.sub("", text.lower())
        conf = sum(confs) / len(confs) if confs else 0.0
        return text, conf


class SeqDecodeUDF:
    """Actor-pool map_batches UDF: decode a list<int> token-id column.

    `kind`: 'attn' | 'master' | 'sar'. Decoder construction happens once
    per actor in __init__; __call__ is a per-row decode loop over the
    (short) sequences."""

    _KINDS = {"attn": AttnDecoder, "master": MasterDecoder,
              "sar": SARDecoder}

    def __init__(self, kind: str = "attn", ids_col: str = "token_ids",
                 probs_col: Optional[str] = None, out_col: str = "text",
                 **decoder_kwargs):
        if kind not in self._KINDS:
            raise ValueError(f"unknown decoder kind={kind!r}")
        self.decoder = self._KINDS[kind](**decoder_kwargs)
        self.ids_col = ids_col
        self.probs_col = probs_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_rows = batch.column(self.ids_col).to_pylist()
        probs_rows = (batch.column(self.probs_col).to_pylist()
                      if self.probs_col else [None] * len(ids_rows))
        texts, confs = [], []
        for ids, probs in zip(ids_rows, probs_rows):
            t, c = self.decoder.decode_one(ids or [], probs)
            texts.append(t)
            confs.append(c)
        return batch.append_column(
            self.out_col, pa.array(texts, type=pa.string())
        ).append_column("conf", pa.array(confs, type=pa.float64()))

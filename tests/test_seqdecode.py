"""EOS-terminated sequence decoders (Attn/Master/SAR analogs)."""

import pyarrow as pa

from webextract.stages.seqdecode import (
    AttnDecoder,
    MasterDecoder,
    SARDecoder,
    SeqDecodeUDF,
)


def test_attn_stop_truncation():
    d = AttnDecoder(charset="abc")
    # dict: <GO>=0 <STOP>=1 a=2 b=3 c=4
    assert d.decode_one([2, 3, 4, 1, 2, 2])[0] == "abc"
    # no STOP anywhere -> empty string (the reference's explicit rule)
    assert d.decode_one([2, 3, 4])[0] == ""
    assert d.decode_one([1, 2, 3])[0] == ""  # immediate STOP


def test_attn_confidence():
    d = AttnDecoder(charset="ab")
    text, conf = d.decode_one([2, 3, 1], probs=[0.5, 0.7, 0.9])
    assert text == "ab" and abs(conf - 0.6) < 1e-12
    assert d.decode_one([2, 3], probs=[0.5, 0.7]) == ("", 0.0)


def test_attn_default_dict_lowers():
    d = AttnDecoder()  # 36-char default, auto-lower
    assert d.num_classes == 38
    assert d.decode_one([12, 13, 1])[0] == "ab"


def test_master_specials():
    d = MasterDecoder(charset="ab", use_unknown_char=True)
    # dict: <GO> <STOP> <PAD> a b <UNKNOWN>
    assert d.pad_idx == 2 and d.character[5] == "<UNKNOWN>"
    assert d.decode_one([3, 4, 1, 2, 2])[0] == "ab"


def test_sar_decode():
    d = SARDecoder(charset="ab")
    # dict: a=0 b=1 <UKN>=2 <BOS/EOS>=3 <PAD>=4
    assert d.start_idx == d.end_idx == 3 and d.padding_idx == 4
    # padding skipped, EOS breaks
    assert d.decode_one([0, 4, 1, 3, 0])[0] == "ab"
    # leading EOS without probs is skipped (label-decode quirk)
    assert d.decode_one([3, 0, 1, 3])[0] == "ab"
    # leading EOS WITH probs terminates immediately
    assert d.decode_one([3, 0, 1], probs=[0.9, 0.9, 0.9])[0] == ""
    # repeat collapse only when asked
    assert d.decode_one([0, 0, 1, 3])[0] == "aab"
    assert d.decode_one([0, 0, 1, 3], is_remove_duplicate=True)[0] == "ab"


def test_sar_rm_symbol():
    d = SARDecoder(charset=list("aB!"), rm_symbol=True)
    # dict: a=0 B=1 !=2 <UKN>=3 <BOS/EOS>=4 <PAD>=5
    text, _ = d.decode_one([0, 1, 2, 4])
    assert text == "ab"  # lowered, symbol stripped


def test_udf_batch():
    udf = SeqDecodeUDF(kind="attn", charset="xyz")
    batch = pa.table({"token_ids": [[2, 3, 1], [4, 4]]})
    out = udf(batch)
    assert out.column("text").to_pylist() == ["xy", ""]
    assert out.column("conf").to_pylist() == [0.0, 0.0]

"""PII detection/redaction tests."""

import pyarrow as pa
import ray.data

from webextract.functions.pii import PiiScanner, detect_pii, redact


def test_detect_email_and_ip():
    text = "mail me at jo.doe+x@test.example or ping 192.168.0.1 ok"
    spans = detect_pii(text)
    kinds = [s["kind"] for s in spans]
    assert kinds == ["email", "ipv4"]
    s = spans[0]
    assert text[s["start"] : s["end"]] == "jo.doe+x@test.example"


def test_detect_phone_and_ssn():
    spans = detect_pii("call +1 (555) 123-4567 or ssn 123-45-6789 now")
    assert {s["kind"] for s in spans} == {"phone", "ssn_like"}


def test_no_overlap_first_pattern_wins():
    # the digits of an ipv4 could also look phone-ish; ipv4 is listed first
    spans = detect_pii("host 10.0.0.1 end")
    assert [s["kind"] for s in spans] == ["ipv4"]


def test_redact_roundtrip_structure():
    text = "a@b.co and 1.2.3.4"
    spans = detect_pii(text)
    assert redact(text, spans) == "<EMAIL> and <IPV4>"
    assert redact("clean text", []) == "clean text"


def test_scanner_stage(ray_session):
    t = pa.table({"text": ["write a@b.co today", "nothing here"]})
    out = (
        ray.data.from_arrow(t)
        .map_batches(PiiScanner, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert out.text_redacted.tolist() == ["write <EMAIL> today", "nothing here"]
    assert len(out.pii_spans[0]) == 1 and len(out.pii_spans[1]) == 0

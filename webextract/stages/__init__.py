from webextract.stages.segment import BlockSegmenter, SegmentConfig, segment_html
from webextract.stages.extract import SpanExtractor, decode_span
from webextract.stages.assemble import assemble_batch

__all__ = [
    "BlockSegmenter",
    "SegmentConfig",
    "segment_html",
    "SpanExtractor",
    "decode_span",
    "assemble_batch",
]

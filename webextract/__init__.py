"""ray-webextract — a from-scratch Ray-Data-native main-content extraction engine.

Recasts the two-stage detect-then-recognize structure of mindspore-lab/mindocr
(DBNet-style region detection feeding CRNN/SVTR-style recognition; see
/root/reference/tools/infer/text/predict_system.py) as detect-then-extract over
Common-Crawl-style web documents:

* a **block-segmentation** ("detect") stage scores DOM subtrees with
  text-density / link-density heuristics and emits byte-offset spans
  (`webextract.stages.segment`), the analog of
  `mindocr/postprocess/det_db_postprocess.py`;
* an **extraction** ("recognize") stage decodes each span to canonical text
  (`webextract.stages.extract`), the analog of
  `mindocr/postprocess/rec_postprocess.py` CTC decoding;
* an **assembly** stage joins ordered block texts into the per-document
  canonical text (`webextract.stages.assemble`), the analog of
  `tools/infer/text/predict_system.py:327-379`.

Everything runs as `ray.data.Dataset` pipelines of `map_batches` over
zero-copy Arrow blocks; stateful stages are actor pools.
"""

__version__ = "0.1.0"

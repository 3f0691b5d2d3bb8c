from webextract.pipelines.extract_pipeline import extract_pages, extract_one

__all__ = ["extract_pages", "extract_one"]

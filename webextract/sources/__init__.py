from webextract.sources.pages import read_pages, pages_from_documents

__all__ = ["read_pages", "pages_from_documents"]

from .extract import extract_text_stage, html_of  # noqa: F401
from .generator import generate_pages, make_pages_from_documents  # noqa: F401

from .pages import extract_text_udf, generate_pages, generate_recrawl_delta  # noqa: F401

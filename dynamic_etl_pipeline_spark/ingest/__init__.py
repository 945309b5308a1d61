from .readers import (  # noqa: F401
    read_any,
    read_csv,
    read_docx,
    read_json,
    read_pdf,
    read_txt,
    read_xml,
)

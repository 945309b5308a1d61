from .extract import (  # noqa: F401
    DATE_RE,
    EMAIL_RE,
    NUMBER_RE,
    PHONE_RE,
    extract_dates,
    extract_emails,
    extract_numbers,
    extract_patterns,
    extract_phones,
)
from .text import (  # noqa: F401
    detect_lang,
    quality_signals,
    rolling_fingerprint,
    token_count,
)

"""Host-side text processing (tokenize → stopword → stem → hash)."""

from cosdata_tpu.text.processing import (  # noqa: F401
    STOPWORDS,
    count_tokens,
    process_text,
    process_text_query,
    tokenize,
)

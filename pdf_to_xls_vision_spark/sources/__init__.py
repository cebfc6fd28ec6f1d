from pdf_to_xls_vision_spark.sources.span_docs import (  # noqa: F401
    SPAN_DOC_SCHEMA,
    read_span_docs,
    stream_span_docs,
)

"""AI/LLM-data-pipeline operators (SURVEY.md §2.K + scale-path extras):
text cleaning/analysis, dedup (exact/MinHash/SimHash/n-gram/semantic),
similarity search, sentiment, multimodal — registered on import."""

from ai_dataingestion_spark.ai import (  # noqa: F401
    dedup,
    multimodal,
    sentiment,
    similarity,
    text,
)

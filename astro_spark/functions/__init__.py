# LLM-data-pipeline function layer: text analysis, dedup, similarity.

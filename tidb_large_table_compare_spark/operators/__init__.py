"""DataFrame-native operators: comparison engine + LLM-pipeline extensions."""

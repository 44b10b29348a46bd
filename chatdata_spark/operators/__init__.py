"""Custom operators: kNN / ANN search, dedup family, mutations, multimodal."""

"""Host-side utilities: tokenizer surgery, prompts, stopwords, analyzers."""

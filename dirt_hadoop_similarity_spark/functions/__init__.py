"""Scalar functions: Porter stemmer, phrase→path compiler, text analysis."""

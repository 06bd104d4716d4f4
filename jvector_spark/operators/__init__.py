"""Engine operators: exact search, quantized search, index, dedup, text."""

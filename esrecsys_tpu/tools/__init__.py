"""Debug & inspection tools: proto cat, co-occurrence dumpers, baselines."""

"""DataFrame-level operators: PIP join, zonal stats, kNN, dedup, text,
similarity, band merge, coverage, climatology, validation, skew handling."""

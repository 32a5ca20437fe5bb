"""Row-level transform operators: cast, permutation, rowid, dedup, text, similarity."""

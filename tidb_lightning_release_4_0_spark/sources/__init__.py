"""Sources: dump-dir discovery, CSV/SQL-dump readers, testdata loader."""

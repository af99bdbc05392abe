"""Sources: deterministic synthetic world + CSV list reader."""

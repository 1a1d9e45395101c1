"""Sources: deterministic synthetic corpus generation + table IO."""

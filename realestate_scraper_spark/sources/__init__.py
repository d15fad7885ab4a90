"""Sources: deterministic synthetic corpus + table IO."""

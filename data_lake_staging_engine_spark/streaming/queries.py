"""§2.E streaming queries — placeholder, populated in M4."""

"""§2.A staging surface — placeholder, populated in M3."""

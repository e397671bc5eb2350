"""§2.F UDF surface — placeholder, populated in M5."""

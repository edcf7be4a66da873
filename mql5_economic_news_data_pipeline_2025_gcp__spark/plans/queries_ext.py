"""Extension query registry (placeholder — populated after core is green)."""

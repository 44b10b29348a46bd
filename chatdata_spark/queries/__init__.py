"""Driver-visible query definitions, one module per operator family."""

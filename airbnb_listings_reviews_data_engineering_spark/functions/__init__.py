"""Column-expression helpers shared across operators and plans."""

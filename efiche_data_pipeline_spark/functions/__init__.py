"""Column-expression helpers shared across plans and operators."""

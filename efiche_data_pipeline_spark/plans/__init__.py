"""Query plans: the analytics corpus, extension operators, and the
star-schema warehouse builder."""

"""Plan inspection helpers — the .explain() feedback loop as code."""

"""Command-line interface: the same 25 verbs as the reference, lazily loaded."""

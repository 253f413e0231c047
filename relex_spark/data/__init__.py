"""Packaged fixture data (SemEval/TACRED goldens) — a regular package
so importlib.resources works from a --py-files zip (zipimport provides a
resource reader only for real packages, not namespace ones)."""

"""Dataset-prep and evaluation tools (reference datasets/*.py + repo-root
one-offs — SURVEY.md §2.1 #25-28)."""

"""Recipe stage drivers — the reference's egs/one-to-one/run.sh stages 0-6 as
one typed-config Python driver (SURVEY.md §2, §3)."""

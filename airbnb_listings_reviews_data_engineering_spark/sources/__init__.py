"""Sources and sinks (explicit schemas everywhere — no inference in
production paths; SURVEY.md §1.3)."""

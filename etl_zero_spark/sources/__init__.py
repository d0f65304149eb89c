"""Sources & sinks: scans (S1-S4), writers (S5-S9), incremental loads,
JDBC parity. See SURVEY.md §2.1."""

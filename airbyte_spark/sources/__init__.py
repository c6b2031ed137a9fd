"""Sources & sinks: incremental cursor scans, sampling, format writers."""

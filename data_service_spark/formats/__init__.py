"""File-format codecs mounted behind the Python DataSource V2 API."""

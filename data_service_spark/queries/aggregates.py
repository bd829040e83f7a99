"""placeholder — populated in a later phase."""

"""Source connectors and catalog operations (O1, O4, O5, O15-O17)."""

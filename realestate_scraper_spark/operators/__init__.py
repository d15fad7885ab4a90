"""Domain operators over the curated tables (spatial dup-join, geocode dim)."""

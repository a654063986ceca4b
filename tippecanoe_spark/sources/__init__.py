"""Input source adapters: GeoJSON (S1), CSV points (S6)."""

"""Stage compositions: pseudonymisation, feature extraction."""

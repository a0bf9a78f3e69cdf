"""validators subpackage."""

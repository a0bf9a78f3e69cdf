"""actions subpackage."""

"""Sources: synthetic web corpus (input_hint shape) and table layer."""

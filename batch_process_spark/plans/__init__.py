"""Plans: operator registry, rule-config compiler, simulate, history."""

"""Query plans: the driver-contract registry and bench queries."""

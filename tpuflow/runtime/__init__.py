"""Runtime: engines, scans, sharding, weight conversion, device management."""

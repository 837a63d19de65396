"""Sources and sinks: synthetic generator, file IO, Kafka (gated)."""

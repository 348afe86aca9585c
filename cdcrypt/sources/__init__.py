"""Change-event sources: deterministic WAL/binlog-shaped generator and the
epoch-file micro-batch source (Kafka-less stand-in for a Debezium topic)."""

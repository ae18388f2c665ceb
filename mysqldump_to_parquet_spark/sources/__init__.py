"""Sources: mysqldump ingest (the reference's entire surface) + file readers."""

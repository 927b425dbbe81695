# Structured Streaming extensions (Autoloader-style incremental load).

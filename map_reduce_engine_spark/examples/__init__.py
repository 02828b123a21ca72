"""Example client jobs for the Job API — the reference's wordcount/wordlength
client jars (``wordcount-src/``, ``wordlength-src/``) as plain Python modules."""

QUERIES: dict = {}
ORACLE: dict = {}

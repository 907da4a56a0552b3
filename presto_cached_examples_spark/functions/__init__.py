"""User-defined function surface — pandas (Arrow-vectorized) UDF/UDAF/UDTF.

Policy (SURVEY.md §1.2): UDFs are the slow path. Every UDF here exists
to *demonstrate the extension surface* and is paired with a built-in
twin used as its oracle; engine queries use the built-in form.
"""

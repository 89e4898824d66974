# build a taxi-shaped parquet fixture to drive TaxiEtlMain end-to-end
import duckdb
con = duckdb.connect()
con.execute("""
COPY (
  SELECT CAST(1 + (i % 2) AS INT) AS VendorID,
    TIMESTAMP '2024-03-01 06:00:00' + INTERVAL (i) MINUTE AS tpep_pickup_datetime,
    TIMESTAMP '2024-03-01 06:00:00' + INTERVAL (i) MINUTE
      + INTERVAL (CASE WHEN i % 97 = 0 THEN 0 ELSE 10 + i % 50 END) MINUTE AS tpep_dropoff_datetime,
    CAST(CASE WHEN i % 13 = 0 THEN 0 ELSE 1 + i % 5 END AS INT) AS passenger_count,
    CASE WHEN i % 31 = 0 THEN 0.01 ELSE 1.0 + (i % 200) / 10.0 END AS trip_distance,
    CAST(1 + i % 260 AS INT) AS PULocationID, CAST(1 + (i * 7) % 260 AS INT) AS DOLocationID,
    CAST(1 + i % 6 AS INT) AS RatecodeID, CAST(1 + i % 5 AS INT) AS payment_type,
    CASE WHEN i % 41 = 0 THEN -5.0 ELSE 5.0 + (i % 80) END AS fare_amount,
    10.0 + (i % 90) AS total_amount
  FROM generate_series(0, 19999) t(i)
) TO '/tmp/taxi_fixture.parquet' (FORMAT PARQUET)
""")
print("fixture rows:", con.sql("SELECT count(*) FROM '/tmp/taxi_fixture.parquet'").fetchone()[0])

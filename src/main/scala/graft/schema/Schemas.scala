package graft.schema

import java.sql.Timestamp

/** Typed row models (SURVEY.md §7 module 1): case classes for the taxi
  * contract and the harness tables, for `Dataset[T]` pipelines where
  * compile-time field checks help (encoders derive automatically).
  */
case class Trip(VendorID: Short, tpep_pickup_datetime: Timestamp,
    tpep_dropoff_datetime: Timestamp, passenger_count: Short, trip_distance: Double,
    PULocationID: Short, DOLocationID: Short, RatecodeID: Int, payment_type: Int,
    fare_amount: Double, total_amount: Double)

case class LineItem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double, l_tax: Double,
    l_returnflag: String, l_linestatus: String, l_shipdate: Timestamp)

case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int, c_acctbal: Double,
    c_mktsegment: String)

case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
    value: Double, props: String)

case class Document(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

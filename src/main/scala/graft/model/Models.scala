package graft.model

/**
 * Event/result schemas of the reference suite, re-expressed as Scala case
 * classes (Spark `Encoder`-friendly).
 *
 * Sources (reference, read-only at /root/reference):
 *  - UserBehavior:      gmall-user-behavior/src/main/java/com/atguigu/bean/UserBehavior.java:12-16
 *  - ApacheLog:         gmall-network-flow/src/main/java/com/atguigu/bean/ApacheLog.java:12-16
 *  - MarketUserBehavior gmall-market/src/main/java/com/atguigu/bean/MarketUserBehavior.java:12-15
 *  - AdClickEvent:      gmall-market/src/main/java/com/atguigu/bean/AdClickEvent.java:11-15
 *  - LoginEvent:        gmall-login-fail/src/main/java/com/atguigu/bean/LoginEvent.java:11-14
 *  - OrderEvent:        gmall-order-pay/src/main/java/com/atguigu/bean/OrderEvent.java:11-14
 *  - ReceiptEvent:      gmall-order-pay/src/main/java/com/atguigu/bean/ReceiptEvent.java:11-13
 *
 * Timestamps are epoch **seconds** in the source files (multiplied to millis
 * by the reference's timestamp extractors, e.g. HotItemApp.java:48); we keep
 * them as epoch seconds and convert with `timestamp_seconds` at the edge.
 */
final case class UserBehavior(
    userId: Long,
    itemId: Long,
    categoryId: Int,
    behavior: String, // pv | buy | cart | fav
    timestamp: Long)  // epoch seconds

final case class ApacheLog(
    ip: String,
    userId: String,
    eventTime: Long, // epoch millis (parsed from dd/MM/yyyy:HH:mm:ss)
    method: String,
    url: String)

final case class MarketUserBehavior(
    userId: Long,
    behavior: String, // CLICK | DOWNLOAD | INSTALL | UNINSTALL
    channel: String,  // app store | wechat | weibo | tieba
    timestamp: Long)  // epoch millis

final case class AdClickEvent(
    userId: Long,
    adId: Long,
    province: String,
    city: String,
    timestamp: Long) // epoch seconds

final case class LoginEvent(
    userId: Long,
    ip: String,
    eventType: String, // success | fail
    timestamp: Long)   // epoch seconds

final case class OrderEvent(
    orderId: Long,
    eventType: String, // create | pay
    txId: String,      // "" on create rows
    eventTime: Long)   // epoch seconds

final case class ReceiptEvent(
    txId: String,
    payChannel: String, // wechat | alipay
    timestamp: Long)    // epoch seconds

// ---- result shapes (§1.4 of SURVEY.md) ----

final case class ItemCount(itemId: Long, windowEnd: Long, count: Long)
final case class UrlViewCount(url: String, windowEnd: Long, count: Long)
final case class PvCount(pv: String, windowEnd: Long, count: Long)
final case class UvCount(uv: String, windowEnd: Long, count: Long)
final case class ChannelBehaviorCount(channel: String, behavior: String, windowEnd: Long, count: Long)
final case class AdCountByProvince(province: String, windowEnd: Long, count: Long)
final case class BlackListWarning(userId: Long, adId: Long, warningMsg: String)
final case class OrderResult(orderId: Long, resultType: String)
final case class LoginFailWarning(userId: Long, firstFailTs: Long, secondFailTs: Long, message: String)

/** Driver synthetic `events` table row (TESTDATA.md), used as the carrier
  * for mapping the reference's stream queries onto oracle-checkable data. */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String, // click | purchase | error | signup | view
    value: Double,
    props: String) // JSON: {"k": <int 0..99>}

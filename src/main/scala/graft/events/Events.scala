package graft.events

import java.util.concurrent.{ConcurrentHashMap, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable

/**
 * Event bus (reference: core/event/manager.py:10-112 + core/event/
 * __init__.py:15-154): a daemon consumer thread drains a queue and
 * dispatches to subscribed handlers; ASAP events fire immediately,
 * DELAYED after an interval on a timer thread, END events accumulate and
 * fire when the terminal [[EndEvent]] arrives.
 *
 * Handlers run off the Spark driver's hot path — an event storm cannot
 * stall query execution.
 */
sealed trait EventTiming
object EventTiming {
  case object Asap extends EventTiming
  case object Delayed extends EventTiming
  case object End extends EventTiming
}

/** An emitted event; `name` keys the subscription table
  * (core/schemas/event.py:6-101 severity/type surface collapsed to the
  * fields handlers actually consume). */
final case class Event(
    name: String,
    timing: EventTiming = EventTiming.Asap,
    severity: String = "INFO",
    payload: Map[String, String] = Map.empty,
    delayMs: Long = 0)

/** Terminal sentinel: flushes END-queued events and stops the consumer. */
object EndEvent {
  val instance: Event = Event("__end__", EventTiming.End)
}

final class EventManager {
  private val queue = new LinkedBlockingQueue[Event]()
  private val subscriptions =
    new ConcurrentHashMap[String, mutable.Map[Int, Event => Unit]]()
  private val nextId = new AtomicInteger(0)
  private val endQueue = mutable.ArrayBuffer.empty[Event]
  @volatile private var running = false

  private val consumer = new Thread(() => {
    var done = false
    while (!done) {
      val event = queue.take()
      if (event eq EndEvent.instance) {
        endQueue.synchronized(endQueue.toSeq).foreach(executeHandlers)
        done = true
      } else dispatch(event)
    }
  }, "graft-event-manager")
  consumer.setDaemon(true)

  def subscribe(eventName: String, handler: Event => Unit): Int = {
    val id = nextId.getAndIncrement()
    subscriptions
      .computeIfAbsent(eventName, _ => mutable.Map.empty)
      .synchronized { subscriptions.get(eventName) += (id -> handler) }
    id
  }

  def unsubscribe(eventName: String, id: Int): Unit =
    Option(subscriptions.get(eventName)).foreach(m => m.synchronized(m -= id))

  def start(): Unit = { running = true; consumer.start() }

  def push(event: Event): Unit = queue.put(event)

  /** Push the end sentinel and wait for the consumer to drain. */
  def stop(timeoutMs: Long = 10000): Unit = {
    if (running) {
      queue.put(EndEvent.instance)
      consumer.join(timeoutMs)
      running = false
    }
  }

  private def executeHandlers(event: Event): Unit =
    Option(subscriptions.get(event.name)).foreach { m =>
      m.synchronized(m.values.toSeq).foreach { h =>
        try h(event) catch { case _: Throwable => /* handler errors never propagate */ }
      }
    }

  private def dispatch(event: Event): Unit = event.timing match {
    case EventTiming.End => endQueue.synchronized { endQueue += event; () }
    case EventTiming.Delayed =>
      val t = new java.util.Timer(true)
      t.schedule(new java.util.TimerTask {
        override def run(): Unit = { executeHandlers(event); t.cancel() }
      }, event.delayMs)
    case EventTiming.Asap => executeHandlers(event)
  }
}

object EventManager {
  /** Convenience: manager with a started consumer. */
  def started(): EventManager = { val m = new EventManager; m.start(); m }
}

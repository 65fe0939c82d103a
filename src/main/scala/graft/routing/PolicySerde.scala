package graft.routing

import scala.concurrent.duration._
import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.connector.Middleware
import graft.core.Errors.BorsaError
import graft.core.Model._
import graft.router.{Fetch, HistoryOrchestrator, HistoryRouter}

/** JSON (de)serialization for the routing/config surface (reference:
  * borsa-types ships serde for RoutingPolicy/Config with round-trip tests;
  * here the same contract over Jackson, which Spark already bundles).
  *
  * Shape:
  * {{{
  * { "routing": { "rules": [{"symbol": "AAPL", "kind": "equity",
  *                           "exchange": "NMS", "providers": ["a","b"],
  *                           "strict": true}],
  *                "global": {"providers": ["a"], "strict": false} },
  *   "exchangePreferences": { "bySymbol": {"AAPL": ["NMS"]},
  *                            "byKind": {"equity": ["NMS"]},
  *                            "global": ["NMS"] },
  *   "fetch":   { "strategy": "priority_with_fallback", "providerTimeoutMs": 5000,
  *                "requestTimeoutMs": 30000 },
  *   "history": { "strategy": "deep", "preferAdjusted": true,
  *                "providerTimeoutMs": 5000, "requestTimeoutMs": 30000,
  *                "finalResample": "auto_daily" } }
  * }}}
  * Unknown fields are ignored (forward compatibility); unknown enum values
  * are InvalidArg errors.
  */
object PolicySerde {

  final case class GraftConfig(
      routing: Policy.ProviderPolicy = Policy.ProviderPolicy(),
      exchangePreferences: Policy.ExchangePreference = Policy.ExchangePreference(),
      fetch: Fetch.Config = Fetch.Config(),
      history: HistoryOrchestrator.Config = HistoryOrchestrator.Config(),
      middleware: graft.Graft.MiddlewareConfig = graft.Graft.MiddlewareConfig())

  private val mapper = new ObjectMapper

  // ------------------------------------------------------------ enums

  private val kindNames: Seq[(AssetKind, String)] = Seq(
    AssetKind.Equity -> "equity", AssetKind.Fund -> "fund", AssetKind.Index -> "index",
    AssetKind.Crypto -> "crypto", AssetKind.Forex -> "forex",
    AssetKind.Commodity -> "commodity", AssetKind.Bond -> "bond", AssetKind.Other -> "other")
  private def kindName(k: AssetKind): String = kindNames.find(_._1 == k).get._2
  private def kindOf(s: String): Either[BorsaError, AssetKind] =
    kindNames.find(_._2 == s).map(_._1).toRight(BorsaError.InvalidArg(s"unknown asset kind '$s'"))

  private def resampleName(r: HistoryRouter.FinalResample): String = r match {
    case HistoryRouter.FinalResample.None      => "none"
    case HistoryRouter.FinalResample.Daily     => "daily"
    case HistoryRouter.FinalResample.Weekly    => "weekly"
    case HistoryRouter.FinalResample.AutoDaily => "auto_daily"
  }
  private def resampleOf(s: String): Either[BorsaError, HistoryRouter.FinalResample] = s match {
    case "none"       => Right(HistoryRouter.FinalResample.None)
    case "daily"      => Right(HistoryRouter.FinalResample.Daily)
    case "weekly"     => Right(HistoryRouter.FinalResample.Weekly)
    case "auto_daily" => Right(HistoryRouter.FinalResample.AutoDaily)
    case other        => Left(BorsaError.InvalidArg(s"unknown finalResample '$other'"))
  }

  // ---------------------------------------------------------- to JSON

  def toJson(cfg: GraftConfig): String = {
    val root = mapper.createObjectNode

    val routing = root.putObject("routing")
    val rules = routing.putArray("rules")
    cfg.routing.rules.foreach { r =>
      val o = rules.addObject()
      r.selector.symbol.foreach(s => o.put("symbol", s.value))
      r.selector.kind.foreach(k => o.put("kind", kindName(k)))
      r.selector.exchange.foreach(e => o.put("exchange", e.code))
      val ps = o.putArray("providers"); r.providers.foreach(ps.add)
      o.put("strict", r.strict)
    }
    cfg.routing.global.foreach { case (providers, strict) =>
      val g = routing.putObject("global")
      val ps = g.putArray("providers"); providers.foreach(ps.add)
      g.put("strict", strict)
    }

    val prefs = root.putObject("exchangePreferences")
    val bySym = prefs.putObject("bySymbol")
    cfg.exchangePreferences.bySymbol.toSeq.sortBy(_._1.value).foreach { case (s, es) =>
      val a = bySym.putArray(s.value); es.foreach(e => a.add(e.code))
    }
    val byKind = prefs.putObject("byKind")
    cfg.exchangePreferences.byKind.toSeq.sortBy(t => kindName(t._1)).foreach { case (k, es) =>
      val a = byKind.putArray(kindName(k)); es.foreach(e => a.add(e.code))
    }
    val glob = prefs.putArray("global")
    cfg.exchangePreferences.global.foreach(e => glob.add(e.code))

    val fetch = root.putObject("fetch")
    fetch.put("strategy", cfg.fetch.strategy match {
      case Fetch.Strategy.PriorityWithFallback => "priority_with_fallback"
      case Fetch.Strategy.Latency              => "latency"
    })
    fetch.put("providerTimeoutMs", cfg.fetch.providerTimeout.toMillis)
    cfg.fetch.requestTimeout.foreach(t => fetch.put("requestTimeoutMs", t.toMillis))

    val history = root.putObject("history")
    history.put("strategy", cfg.history.strategy match {
      case HistoryOrchestrator.MergeStrategy.Deep     => "deep"
      case HistoryOrchestrator.MergeStrategy.Fallback => "fallback"
    })
    history.put("preferAdjusted", cfg.history.preferAdjusted)
    history.put("providerTimeoutMs", cfg.history.providerTimeout.toMillis)
    cfg.history.requestTimeout.foreach(t => history.put("requestTimeoutMs", t.toMillis))
    history.put("finalResample", resampleName(cfg.history.finalResample))

    val mw = root.putObject("middleware")
    cfg.middleware.cache match {
      case None => mw.putNull("cache")
      case Some(c) =>
        val o = mw.putObject("cache")
        o.put("capacityPerCapability", c.capacityPerCapability)
        o.put("defaultTtlMs", c.defaultTtlMs)
        o.put("negativeTtlMs", c.negativeTtlMs)
        val ttls = o.putObject("ttlMs")
        c.ttlMs.toSeq.sortBy(_._1).foreach { case (k, v) => ttls.put(k, v) }
    }
    cfg.middleware.blacklist match {
      case None => mw.putNull("blacklist")
      case Some(b) => mw.putObject("blacklist").put("defaultWindowMs", b.defaultWindowMs)
    }
    cfg.middleware.quota match {
      case None => mw.putNull("quota")
      case Some(q) =>
        val o = mw.putObject("quota")
        o.put("limit", q.limit)
        o.put("windowMs", q.windowMs)
        o.put("strategy", q.strategy match {
          case Middleware.QuotaStrategy.Unit             => "unit"
          case Middleware.QuotaStrategy.Weighted         => "weighted"
          case Middleware.QuotaStrategy.EvenSpreadHourly => "even_spread_hourly"
        })
        if (q.capabilityWeights.nonEmpty) {
          val ws = o.putObject("weights")
          q.capabilityWeights.toSeq.sortBy(_._1).foreach { case (k, v) => ws.put(k, v) }
        }
    }

    mapper.writerWithDefaultPrettyPrinter.writeValueAsString(root)
  }

  // -------------------------------------------------------- from JSON

  private def optNode(n: JsonNode, f: String): Option[JsonNode] =
    Option(n.get(f)).filterNot(_.isNull)
  private def strings(n: JsonNode): Seq[String] = n.elements.asScala.map(_.asText).toSeq

  private def sequenceE[A](xs: Seq[Either[BorsaError, A]]): Either[BorsaError, Seq[A]] =
    xs.foldLeft[Either[BorsaError, Vector[A]]](Right(Vector.empty)) {
      case (acc, x) => acc.flatMap(v => x.map(v :+ _))
    }

  def fromJson(json: String): Either[BorsaError, GraftConfig] =
    Try(mapper.readTree(json)) match {
      case Failure(e) => Left(BorsaError.InvalidArg(s"malformed config JSON: ${e.getMessage}"))
      case Success(null) => Left(BorsaError.InvalidArg("empty config JSON"))
      case Success(root) =>
        for {
          routing <- optNode(root, "routing").map(parseRouting)
            .getOrElse(Right(Policy.ProviderPolicy()))
          prefs <- optNode(root, "exchangePreferences").map(parsePrefs)
            .getOrElse(Right(Policy.ExchangePreference()))
          fetch <- optNode(root, "fetch").map(parseFetch).getOrElse(Right(Fetch.Config()))
          history <- optNode(root, "history").map(parseHistory)
            .getOrElse(Right(HistoryOrchestrator.Config()))
          mw <- optNode(root, "middleware").map(parseMiddleware)
            .getOrElse(Right(graft.Graft.MiddlewareConfig()))
        } yield GraftConfig(routing, prefs, fetch, history, mw)
    }

  private def parseRouting(n: JsonNode): Either[BorsaError, Policy.ProviderPolicy] = {
    val rulesE = sequenceE(
      optNode(n, "rules").map(_.elements.asScala.toSeq).getOrElse(Seq.empty).map { r =>
        for {
          kind <- optNode(r, "kind").map(k => kindOf(k.asText).map(Option(_))).getOrElse(Right(None))
          providers = optNode(r, "providers").map(strings).getOrElse(Seq.empty)
        } yield Policy.Rule(
          Policy.Selector(
            symbol = optNode(r, "symbol").map(s => Symbol(s.asText)),
            kind = kind,
            exchange = optNode(r, "exchange").map(e => Exchange(e.asText))),
          providers,
          strict = optNode(r, "strict").exists(_.asBoolean))
      })
    rulesE.map { rules =>
      val global = optNode(n, "global").map { g =>
        (optNode(g, "providers").map(strings).getOrElse(Seq.empty),
          optNode(g, "strict").exists(_.asBoolean))
      }
      Policy.ProviderPolicy(rules, global)
    }
  }

  private def parsePrefs(n: JsonNode): Either[BorsaError, Policy.ExchangePreference] = {
    val bySym = optNode(n, "bySymbol").map { o =>
      o.properties.asScala.map(e =>
        Symbol(e.getKey) -> strings(e.getValue).map(Exchange(_))).toMap
    }.getOrElse(Map.empty[Symbol, Seq[Exchange]])
    val byKindE = sequenceE(
      optNode(n, "byKind").map(_.properties.asScala.toSeq).getOrElse(Seq.empty).map { e =>
        kindOf(e.getKey).map(_ -> strings(e.getValue).map(Exchange(_)))
      })
    byKindE.map { byKind =>
      Policy.ExchangePreference(bySym, byKind.toMap,
        optNode(n, "global").map(strings).getOrElse(Seq.empty).map(Exchange(_)))
    }
  }

  private def parseFetch(n: JsonNode): Either[BorsaError, Fetch.Config] =
    (optNode(n, "strategy").map(_.asText).getOrElse("priority_with_fallback") match {
      case "priority_with_fallback" => Right(Fetch.Strategy.PriorityWithFallback)
      case "latency"                => Right(Fetch.Strategy.Latency)
      case other => Left(BorsaError.InvalidArg(s"unknown fetch strategy '$other'"))
    }).map { strategy =>
      Fetch.Config(strategy,
        providerTimeout = optNode(n, "providerTimeoutMs").map(_.asLong.millis)
          .getOrElse(Fetch.Config().providerTimeout),
        requestTimeout = optNode(n, "requestTimeoutMs").map(_.asLong.millis))
    }

  /** A middleware layer is: absent → enabled with defaults; explicit null →
    * DISABLED; object → enabled with the given settings.
    */
  private def layer[A](n: JsonNode, f: String, default: Option[A])(
      parse: JsonNode => Either[BorsaError, A]): Either[BorsaError, Option[A]] =
    if (!n.has(f)) Right(default)
    else Option(n.get(f)).filterNot(_.isNull) match {
      case None    => Right(None)
      case Some(v) => parse(v).map(Some(_))
    }

  private def parseMiddleware(n: JsonNode): Either[BorsaError, graft.Graft.MiddlewareConfig] =
    for {
      cache <- layer(n, "cache", Some(Middleware.CacheConfig())) { c =>
        val base = Middleware.CacheConfig()
        Right(Middleware.CacheConfig(
          capacityPerCapability = optNode(c, "capacityPerCapability").map(_.asInt)
            .getOrElse(base.capacityPerCapability),
          defaultTtlMs = optNode(c, "defaultTtlMs").map(_.asLong).getOrElse(base.defaultTtlMs),
          negativeTtlMs = optNode(c, "negativeTtlMs").map(_.asLong).getOrElse(base.negativeTtlMs),
          ttlMs = optNode(c, "ttlMs").map(o =>
            o.properties.asScala.map(e => e.getKey -> e.getValue.asLong).toMap)
            .getOrElse(base.ttlMs)))
      }
      blacklist <- layer(n, "blacklist", Some(Middleware.BlacklistConfig())) { b =>
        Right(Middleware.BlacklistConfig(
          defaultWindowMs = optNode(b, "defaultWindowMs").map(_.asLong)
            .getOrElse(Middleware.BlacklistConfig().defaultWindowMs)))
      }
      quota <- layer(n, "quota", Some(Middleware.QuotaConfig())) { q =>
        (optNode(q, "strategy").map(_.asText).getOrElse("unit") match {
          case "unit"               => Right(Middleware.QuotaStrategy.Unit)
          case "weighted"           => Right(Middleware.QuotaStrategy.Weighted)
          case "even_spread_hourly" => Right(Middleware.QuotaStrategy.EvenSpreadHourly)
          case other => Left(BorsaError.InvalidArg(s"unknown quota strategy '$other'"))
        }).map { strategy =>
          val base = Middleware.QuotaConfig()
          Middleware.QuotaConfig(
            limit = optNode(q, "limit").map(_.asLong).getOrElse(base.limit),
            windowMs = optNode(q, "windowMs").map(_.asLong).getOrElse(base.windowMs),
            strategy = strategy,
            capabilityWeights = optNode(q, "weights").map(o =>
              o.properties.asScala.map(e => e.getKey -> e.getValue.asLong).toMap)
              .getOrElse(Map.empty))
        }
      }
    } yield graft.Graft.MiddlewareConfig(cache, blacklist, quota)

  private def parseHistory(n: JsonNode): Either[BorsaError, HistoryOrchestrator.Config] =
    for {
      strategy <- optNode(n, "strategy").map(_.asText).getOrElse("deep") match {
        case "deep"     => Right(HistoryOrchestrator.MergeStrategy.Deep)
        case "fallback" => Right(HistoryOrchestrator.MergeStrategy.Fallback)
        case other => Left(BorsaError.InvalidArg(s"unknown history strategy '$other'"))
      }
      resample <- optNode(n, "finalResample").map(v => resampleOf(v.asText))
        .getOrElse(Right(HistoryRouter.FinalResample.None))
    } yield HistoryOrchestrator.Config(
      strategy,
      preferAdjusted = optNode(n, "preferAdjusted").forall(_.asBoolean),
      providerTimeout = optNode(n, "providerTimeoutMs").map(_.asLong.millis)
        .getOrElse(HistoryOrchestrator.Config().providerTimeout),
      finalResample = resample,
      requestTimeout = optNode(n, "requestTimeoutMs").map(_.asLong.millis))
}
